"""HTTP transport tests against a local mock server.

The server implements the wire shapes `transport.HttpTransport`
expects (token endpoint, paginated CSV query, count, chunked JSON
insert) with bearer-token auth, so the full session lifecycle —
grant, cache, probe, stale-token re-auth, 401 retry — runs for real
over HTTP on localhost. No Spark session needed except for the
end-to-end DSv2 test at the bottom.
"""

import csv
import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from mriya_spark.connector.transport import (
    AuthError,
    ConnectorParams,
    HttpTransport,
)


class _OrgState:
    def __init__(self):
        self.rows = {}          # obj -> list[dict]
        self.valid_tokens = set()
        self.n_grants = 0
        self.n_queries = 0
        self.lock = threading.Lock()


def _make_handler(state: _OrgState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authed(self) -> bool:
            tok = self.headers.get("Authorization", "").removeprefix("Bearer ")
            return tok in state.valid_tokens

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if self.path == "/services/oauth2/token":
                form = urllib.parse.parse_qs(body.decode())
                if form.get("grant_type") != ["password"] or not form.get("username"):
                    return self._json(400, {"error": "invalid_grant"})
                with state.lock:
                    state.n_grants += 1
                    tok = f"tok_{state.n_grants}"
                    state.valid_tokens.add(tok)
                return self._json(200, {"access_token": tok})
            if not self._authed():
                return self._json(401, {"error": "INVALID_SESSION_ID"})
            if self.path.startswith("/insert/"):
                obj = urllib.parse.unquote(self.path.split("/", 2)[2])
                rows = json.loads(body)
                if len(rows) > 200:
                    return self._json(400, {"error": "chunk too large"})
                with state.lock:
                    state.rows.setdefault(obj, []).extend(rows)
                return self._json(200, {"inserted": len(rows)})
            return self._json(404, {"error": "nope"})

        def do_GET(self):
            if not self._authed():
                return self._json(401, {"error": "INVALID_SESSION_ID"})
            parsed = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(parsed.query)
            verb, obj = parsed.path.split("/", 2)[1:3]
            obj = urllib.parse.unquote(obj)
            filters = json.loads(qs.get("q", ["[]"])[0])

            def keep(r):
                for f in filters:
                    v = r.get(f["col"])
                    if f["op"] == "eq" and not v == f["val"]:
                        return False
                    if f["op"] == "gt" and not (v is not None and v > f["val"]):
                        return False
                return True

            rows = [r for r in state.rows.get(obj, []) if keep(r)]
            if verb == "count":
                return self._json(200, {"count": len(rows)})
            if verb == "query":
                with state.lock:
                    state.n_queries += 1
                cols = qs["columns"][0].split(",")
                off, lim = int(qs["offset"][0]), int(qs["limit"][0])
                buf = io.StringIO()
                w = csv.DictWriter(buf, fieldnames=cols)
                w.writeheader()
                for r in rows[off : off + lim]:
                    w.writerow({c: ("" if r.get(c) is None else r.get(c)) for c in cols})
                body = buf.getvalue().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/csv")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            return self._json(404, {"error": "nope"})

    return Handler


@pytest.fixture()
def org(tmp_path):
    state = _OrgState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    params = ConnectorParams(
        username="it@example.com",
        password="hunter2",
        base_url=f"http://127.0.0.1:{server.server_port}",
        consumer_key="ck",
        consumer_secret="cs",
        session_file=str(tmp_path / "sessions.json"),
    )
    yield state, params
    server.shutdown()


def test_instance_url_prefix_rewrite():
    p = ConnectorParams(
        username="u", password="p",
        base_url="https://login.salesforce.com", url_prefix="test.",
    )
    assert p.instance_url == "https://test.salesforce.com"
    assert p.token_url == "https://test.salesforce.com/services/oauth2/token"
    bare = ConnectorParams(username="u", password="p")
    assert bare.instance_url == "https://login.salesforce.com"


def test_token_grant_cache_and_reuse(org):
    state, params = org
    t1 = HttpTransport(params)
    assert t1.get_token() == "tok_1"
    assert state.n_grants == 1
    # token cached to the session file; a NEW transport probes the
    # cached token, finds it live, and never re-grants
    t2 = HttpTransport(params)
    assert t2.get_token() == "tok_1"
    assert state.n_grants == 1
    assert json.load(open(params.session_file))[params.username] == "tok_1"


def test_stale_cached_token_triggers_regrant(org):
    state, params = org
    HttpTransport(params).get_token()
    state.valid_tokens.clear()  # org revoked the session
    t2 = HttpTransport(params)
    assert t2.get_token() == "tok_2"  # probe failed -> fresh grant
    assert state.n_grants == 2


def test_query_streams_pages_and_nulls(org):
    state, params = org
    state.rows["Account"] = [
        {"id": i, "name": f"n{i}" if i % 3 else None} for i in range(10)
    ]
    t = HttpTransport(params)
    page = list(t.query_page("Account", ["id", "name"], [], 0, 4))
    assert [r["id"] for r in page] == ["0", "1", "2", "3"]  # stringly wire
    assert page[0]["name"] is None  # empty string == NULL
    page2 = list(t.query_page("Account", ["id", "name"], [], 8, 4))
    assert len(page2) == 2  # tail page
    assert t.count("Account", []) == 10
    assert t.count("Account", [{"col": "id", "op": "gt", "val": 7}]) == 2


def test_401_mid_session_reauths_once(org):
    state, params = org
    t = HttpTransport(params)
    t.get_token()
    state.valid_tokens.clear()  # session dies AFTER auth
    assert t.count("Account", []) == 0  # transparent re-auth + retry
    assert state.n_grants == 2


def test_insert_chunk_cap(org):
    state, params = org
    t = HttpTransport(params)
    assert t.insert("Account", [{"id": 1}]) == 1
    with pytest.raises(ValueError, match="exceeds 200"):
        t.insert("Account", [{"id": i} for i in range(201)])


def test_bad_credentials_fail_loudly(org):
    state, params = org
    from dataclasses import replace

    t = HttpTransport(replace(params, username=""))
    with pytest.raises(AuthError):
        t.get_token()


def test_dsv2_read_write_over_http(org, spark):
    """End to end through the DSv2 source with transport=http: chunked
    write out, paginated+pushed-down read back, typed restoration of
    the stringly CSV wire."""
    state, params = org
    from mriya_spark.connector.salesforce import SalesforceMockDataSource

    spark.dataSource.register(SalesforceMockDataSource)
    opts = {
        "transport": "http",
        "base_url": params.base_url,
        "username": params.username,
        "password": params.password,
        "session_file": params.session_file,
        "object": "Contact",
    }
    src = spark.range(500).selectExpr(
        "id AS c_id", "concat('name_', id) AS c_name", "id * 1.5 AS c_score"
    )
    w = src.write.format("salesforce_mock").mode("append")
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()
    assert len(state.rows["Contact"]) == 500

    r = (
        spark.read.format("salesforce_mock")
        .schema("c_id long, c_name string, c_score double")
        .options(**opts, page_size=200)
    )
    back = r.load()
    got = back.filter("c_id > 489").orderBy("c_id").collect()
    assert len(got) == 10
    assert got[0].c_id == 490 and got[0].c_score == 735.0
    assert got[0].c_name == "name_490"

def test_token_cache_file_is_private_and_atomic(org):
    """The cache holds live credentials: it must be created 0600 in a
    0700 directory (the reference keeps sessions in cwd,
    `data_connector.py:24,219-243`; a shared /tmp default would leak
    tokens cross-user), and writes must land atomically."""
    import os
    from dataclasses import replace

    state, params = org
    nested = os.path.join(os.path.dirname(params.session_file), "sub", "s.json")
    p = replace(params, session_file=nested)
    HttpTransport(p).get_token()
    assert os.stat(nested).st_mode & 0o777 == 0o600
    assert os.stat(os.path.dirname(nested)).st_mode & 0o777 == 0o700
    # no torn tmp files left behind
    leftovers = [f for f in os.listdir(os.path.dirname(nested))
                 if f.startswith(".sessions_")]
    assert leftovers == []


def test_token_cache_concurrent_writers_lose_no_entries(org):
    """20 threads doing read-modify-write for distinct usernames: the
    flock'd RMW must serialize them so every entry survives (the old
    unlocked write lost all but the last racer's update)."""
    import threading as th
    from dataclasses import replace

    state, params = org
    users = [f"u{i}@example.com" for i in range(20)]

    def save(u):
        t = HttpTransport(replace(params, username=u))
        t.access_token = f"tok_for_{u}"
        t._save_token()

    threads = [th.Thread(target=save, args=(u,)) for u in users]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    tokens = json.load(open(params.session_file))
    assert {u: f"tok_for_{u}" for u in users}.items() <= tokens.items()


def test_default_session_file_is_user_scoped():
    import os

    from mriya_spark.connector.transport import DEFAULT_SESSION_FILE

    assert not DEFAULT_SESSION_FILE.startswith("/tmp")
    assert DEFAULT_SESSION_FILE.startswith(os.path.expanduser("~"))


def test_preexisting_custom_session_dir_keeps_its_mode(org, tmp_path):
    """r5 ADVICE: a caller-chosen, PRE-EXISTING session dir must not be
    chmod'd to 0700 (that would silently strip deliberately-granted
    group access); instead a too-permissive dir earns a warning. Dirs
    we create ourselves still come out 0700 (covered above)."""
    import os
    import stat
    import warnings
    from dataclasses import replace

    state, params = org
    shared = tmp_path / "deliberately_group_readable"
    shared.mkdir(mode=0o750)
    p = replace(params, session_file=str(shared / "s.json"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        HttpTransport(p).get_token()
    assert stat.S_IMODE(os.stat(shared).st_mode) == 0o750  # untouched
    assert any("group/other-accessible" in str(x.message) for x in w)
    # the token FILE itself is still private regardless of the dir
    assert stat.S_IMODE(os.stat(shared / "s.json").st_mode) == 0o600
