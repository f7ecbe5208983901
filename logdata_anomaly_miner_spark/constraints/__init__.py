"""North-rule constraint suites: per-column stats, uniqueness, referential
integrity, distribution drift, schema checks (BASELINE.json north_star)."""
