"""Logical-plan layer: catalog bootstrap, table loading, and the
driver-facing query inventory (``plans.queries`` / ``plans.oracles``)."""
