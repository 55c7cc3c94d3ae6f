"""Composable DataFrame operators, one module per SURVEY.md §2 family.

Every function takes DataFrames (plus plain-Python parameters) and
returns a DataFrame — lazy end-to-end, no ``collect()`` in the data
plane, so each op scales with the cluster rather than the driver.
"""
