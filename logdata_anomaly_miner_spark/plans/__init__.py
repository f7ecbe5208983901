"""Job orchestration: constraint-suite plans, checkpoint manifest, metrics."""
