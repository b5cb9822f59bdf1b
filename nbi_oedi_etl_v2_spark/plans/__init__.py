"""Query planning surface: the named-query registry and the saved
analytical queries (SURVEY §2.11 O9, §3 EP3)."""
