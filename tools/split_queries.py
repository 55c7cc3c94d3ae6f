"""Mechanically split ``mriya_spark/queries.py`` into per-family chunk
modules re-exported by ``queries.py`` (r17 judge directive 7).

The split is IMPORT-ONLY: every function's source text moves verbatim,
chunk modules import shared helpers and data constants under their
original names, and ``queries.py`` keeps its full public+private
namespace by re-importing every chunk's top-level names in registration
order (REGISTRY order = import order = §2 order). Under those
conditions ``__spark_entry__._query_digest`` is byte-stable for every
query — proven empirically before this tool existed (SCALE.md
"queries.py split: digest-stability verified") and enforced after every
run by the MANDATORY safety net:

    python tools/split_queries.py          # perform the split
    python tools/update_gate_digests.py --dry-run   # must say 0 changed

If the dry run reports ANY changed digest, revert the split (git
checkout) rather than burn gate slots.

Mechanics:
- header = everything up to and including ``def _cat`` (module
  docstring, imports, Query/REGISTRY/register/queries/oracle_sql);
  it stays in queries.py so chunk modules can
  ``from mriya_spark.queries import register, _cat, F, ...`` while
  queries.py itself is mid-import (the header has already executed).
- body top-level statements are grouped into chunks, cutting only at
  ``# §``/``# ---`` banner boundaries past a size target; a chunk that
  references a LATER chunk's top-level name forces a merge (no forward
  imports), iterated to fixpoint.
- each chunk gets ``from __future__ import annotations`` (queries.py
  uses it; dropping it would change annotation bytecode and therefore
  digests) plus generated imports for every external name it reads.
- name analysis over-approximates on purpose: any ``Name`` load that
  collides with a top-level name is imported even if the use is a
  function local — a harmless shadow, never a missed binding.
"""

from __future__ import annotations

import ast
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "mriya_spark", "queries.py")
PKG_DIR = os.path.join(ROOT, "mriya_spark", "qchunks")
TARGET_LINES = 1300


def bound_names(stmts) -> list[str]:
    """Names a list of top-level statements binds in module scope
    (recursing into if/try/for blocks but NOT into function/class
    bodies)."""
    out: list[str] = []

    def visit(st):
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append(st.name)
        elif isinstance(st, ast.Assign):
            for t in st.targets:
                out.extend(target_names(t))
        elif isinstance(st, (ast.AnnAssign, ast.AugAssign)):
            out.extend(target_names(st.target))
        elif isinstance(st, ast.Import):
            for a in st.names:
                out.append((a.asname or a.name).split(".")[0])
        elif isinstance(st, ast.ImportFrom):
            for a in st.names:
                out.append(a.asname or a.name)
        elif isinstance(st, (ast.If, ast.Try, ast.For, ast.While, ast.With)):
            for field in ("body", "orelse", "finalbody", "handlers"):
                for sub in getattr(st, field, []) or []:
                    if isinstance(sub, ast.ExceptHandler):
                        for s2 in sub.body:
                            visit(s2)
                    else:
                        visit(sub)

    for st in stmts:
        visit(st)
    return out


def target_names(t) -> list[str]:
    if isinstance(t, ast.Name):
        return [t.id]
    if isinstance(t, (ast.Tuple, ast.List)):
        out = []
        for e in t.elts:
            out.extend(target_names(e))
        return out
    return []  # attribute/subscript targets don't bind module names


def used_names(stmts) -> set[str]:
    used: set[str] = set()
    for st in stmts:
        for node in ast.walk(st):
            if isinstance(node, ast.Name):
                used.add(node.id)
    return used


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # --- header boundary: through def _cat -------------------------------
    header_end = None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "_cat":
            header_end = node.end_lineno
            break
    assert header_end, "def _cat not found"
    header_stmts = [n for n in tree.body if n.end_lineno <= header_end]
    body_stmts = [n for n in tree.body if n.lineno > header_end]
    header_names = set(bound_names(header_stmts)) | {"__name__", "__file__"}

    # --- initial chunking at banner boundaries ---------------------------
    def banner_before(node, prev_end) -> bool:
        gap = "".join(lines[prev_end : node.lineno - 1])
        return bool(re.search(r"^# (---|§)", gap, re.M))

    chunks: list[list] = [[]]
    size = 0
    prev_end = header_end
    for node in body_stmts:
        if size >= TARGET_LINES and banner_before(node, prev_end):
            chunks.append([])
            size = 0
        chunks[-1].append(node)
        size += node.end_lineno - node.lineno + 1
        prev_end = node.end_lineno

    # --- merge forward references to fixpoint ----------------------------
    while True:
        defined = [set(bound_names(c)) for c in chunks]
        merged = False
        for i, c in enumerate(chunks):
            need = used_names(c) - defined[i] - header_names
            for j in range(i + 1, len(chunks)):
                if need & defined[j]:
                    # merge i..j into one chunk
                    chunks[i : j + 1] = [sum(chunks[i : j + 1], [])]
                    merged = True
                    break
            if merged:
                break
        if not merged:
            break

    # --- emit chunk modules ----------------------------------------------
    os.makedirs(PKG_DIR, exist_ok=True)
    init = os.path.join(PKG_DIR, "__init__.py")
    open(init, "w").write(
        '"""Chunk modules of the query registry — mechanical import-only\n'
        "split of queries.py (see tools/split_queries.py). Import order =\n"
        'registration order = SURVEY §2 order; do not reorder."""\n'
    )

    defined = [
        list(dict.fromkeys(bound_names(c))) for c in chunks
    ]  # dedupe, order-preserving
    all_prior: dict[str, str] = {}
    mod_names: list[str] = []
    prev_end = header_end
    for i, c in enumerate(chunks):
        # slug from the first banner line inside the leading gap/comment
        gap = "".join(lines[prev_end : c[0].lineno - 1])
        m = re.search(r"^# (?:§[\d.]+/?§?[\d.]* ?)?(.+)$", gap.strip().splitlines()[1] if gap.strip().count("\n") >= 1 else "", re.M)
        raw = ""
        for gl in gap.splitlines():
            gl = gl.strip()
            if gl.startswith("#") and not set(gl) <= {"#", "-", " "}:
                raw = gl.lstrip("# ").strip()
                break
        slug = re.sub(r"[^a-z0-9]+", "_", raw.lower()).strip("_")[:40] or "misc"
        mod = f"c{i:02d}_{slug}"
        mod_names.append(mod)

        seg_start = prev_end  # include banners/comments before first stmt
        seg_end = c[-1].end_lineno
        body_text = "".join(lines[seg_start:seg_end])
        prev_end = seg_end

        need = used_names(c) - set(defined[i]) - set(dir(__builtins__))
        try:
            import builtins

            need -= set(vars(builtins))
        except Exception:
            pass
        from_header = sorted(n for n in need if n in header_names)
        from_chunks: dict[str, list[str]] = {}
        for n in sorted(need - set(from_header)):
            origin = all_prior.get(n)
            if origin is not None:
                from_chunks.setdefault(origin, []).append(n)
            # names in neither header nor prior chunks are function
            # locals / builtins — no import needed

        hdr = [
            '"""Auto-generated by tools/split_queries.py — import-only',
            "split of queries.py. Function sources are verbatim; edit",
            'here as you would have edited queries.py."""',
            "",
            "from __future__ import annotations",
            "",
        ]
        if from_header:
            hdr.append(
                "from mriya_spark.queries import (  # noqa: F401\n    "
                + ",\n    ".join(from_header)
                + ",\n)"
            )
        for origin in mod_names[:-1]:
            if origin in from_chunks:
                hdr.append(
                    f"from mriya_spark.qchunks.{origin} import (  # noqa: F401\n    "
                    + ",\n    ".join(from_chunks[origin])
                    + ",\n)"
                )
        hdr.append("")
        open(os.path.join(PKG_DIR, mod + ".py"), "w").write(
            "\n".join(hdr) + "\n" + body_text
        )
        for n in defined[i]:
            all_prior[n] = mod

    # --- rewrite queries.py ------------------------------------------------
    tail = [
        "",
        "",
        "# " + "-" * 75,
        "# Registered query families — mechanical import-only split",
        "# (tools/split_queries.py). Import order IS registration order",
        "# (REGISTRY order = SURVEY §2 order); every top-level name is",
        "# re-exported so `from mriya_spark.queries import X` keeps working.",
        "# " + "-" * 75,
    ]
    for i, mod in enumerate(mod_names):
        names = defined[i]
        tail.append(
            f"from mriya_spark.qchunks.{mod} import (  # noqa: F401,E402\n    "
            + ",\n    ".join(names)
            + ",\n)"
        )
    new_src = "".join(lines[:header_end]) + "\n".join(tail) + "\n"
    open(SRC, "w").write(new_src)
    print(f"split into {len(mod_names)} chunks: {mod_names}")
    sizes = [sum(n.end_lineno - n.lineno + 1 for n in c) for c in chunks]
    print("chunk stmt-line sizes:", sizes)


if __name__ == "__main__":
    sys.exit(main())
