"""Large-scale data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing. All implemented as declarative DataFrame transforms
(no driver-side collects) so they scale to 1000-executor clusters.
"""
