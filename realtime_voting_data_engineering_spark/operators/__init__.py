"""Operator library: the reference's operator inventory (SURVEY.md §2)
re-expressed as composable DataFrame transformations, plus the
large-scale data-pipeline extensions (dedup, similarity, text analysis,
multimodal plumbing)."""
