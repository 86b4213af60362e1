"""Large-scale training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal columns.
All designed for 100 TB: no driver-side collects on data paths, joins
keyed on dense hash buckets, candidate generation via LSH rather than
pairwise cross-joins.
"""
