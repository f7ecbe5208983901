"""Scalar/analytic function layer: text analysis, deduplication, similarity
search, multimodal plumbing — the training-data-pipeline operations the
north star adds on top of the AMiner detector inventory."""
