"""Plan introspection utilities (scale audits)."""
