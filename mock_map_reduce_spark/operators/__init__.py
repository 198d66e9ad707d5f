"""Composable DataFrame operators.

Each module maps a slice of the reference's operator inventory
(SURVEY.md §2) or the LLM-pipeline extension surface onto idiomatic
DataFrame/SQL plans. Every public function takes DataFrames in and
returns a DataFrame — no actions, no collects — so Catalyst sees the
whole plan and can push filters, prune columns, and pick join
strategies end-to-end.
"""
