from . import aggregates, cleaning, dedup, joins, multimodal, similarity, windows  # noqa: F401
