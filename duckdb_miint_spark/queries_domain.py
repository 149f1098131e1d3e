"""Layer-B domain-operator correctness queries (SURVEY.md §2.2).

The driver's oracle only has the ten driver-provided tables, so each domain
query first derives its bio-shaped input (alignments, intervals, sequences)
deterministically from those tables with engine-portable SQL/DataFrame
expressions, then applies the operator under test. The DuckDB oracle applies
the reference semantics to the identically-derived input.
"""

from __future__ import annotations

# populated as operators land
