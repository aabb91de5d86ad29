"""Declarative query plans (the analytics surface of the warehouse).

The reference delegates all analytics to Redshift ("OLAP data warehouse for
easy querying for business analytics", reference README.md:3); this package
supplies the equivalent surface natively via Spark SQL / DataFrame plans.
"""

from .registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    ordered_queries,
    register_query,
)
from . import analytics  # noqa: F401  (populates the registry)
from . import cdc_queries  # noqa: F401
from . import llm_queries  # noqa: F401

# Export ordering is stable registration (source) order; any sampling
# policy belongs to the harness. The full registry is verified locally
# every round by tests/test_oracle_parity.py.
