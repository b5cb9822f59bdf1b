"""Relational + pipeline operators.

Each module implements one family from SURVEY.md §2 (or a §2.11 /
north-star extension) as a pure DataFrame→DataFrame function. No
operator collects to the driver; all return lazy plans.
"""
