"""Detector operators: set-oriented re-expressions of AMiner's analysis
components (reference: aminer/analysis/*.py). Each module documents the
reference file/lines whose semantics it reproduces."""
