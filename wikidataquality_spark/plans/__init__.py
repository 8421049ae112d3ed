"""Query plans exposed through the driver contract (__spark_entry__.py).

This is the engine's "API module" analogue (ref≈api/CheckConstraints.php:~30-150,
SURVEY.md §2A″): every supported operator family is reachable as a named query.
"""
