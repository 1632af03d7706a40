"""Batch relational operators — each a composable DataFrame -> DataFrame
function, mapped 1:1 onto the SURVEY.md §2 inventory (S*/D*/X* ids cited in
each docstring)."""
