"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one implemented operator from
SURVEY.md §2, expressed through the ``cassandra_data_migration_spark``
package; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.
Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).

The registrations themselves live in the per-family ``cdm_entry``
package (split in round 8 — the monolith had crossed 10k lines); this
module is a thin re-export so the driver's ``import __spark_entry__``
contract, and every test that reaches into the entry namespace for a
helper, keep working unchanged.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# the driver may load this file by path (spec_from_file_location)
# rather than via a sys.path import — make the sibling cdm_entry
# package resolvable either way
_here = _os.path.dirname(_os.path.abspath(__file__))
if _here not in _sys.path:
    _sys.path.insert(0, _here)

from cdm_entry.part13_round9 import *  # noqa: E402,F401,F403 — full namespace
from cdm_entry import (  # noqa: E402,F401
    ORACLES,
    QUERIES,
    _ROUND_HEAD,
    entry,
    oracle_sql,
    queries,
)
