"""North-star extension queries (SURVEY.md §7.4): joins, windows,
dedup, similarity search, text analysis, event windows.

Filled in incrementally after reference parity is green.
"""

from __future__ import annotations
