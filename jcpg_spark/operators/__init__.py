"""Pipeline operators: each module maps to a SURVEY.md §2 operator group."""
