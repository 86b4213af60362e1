"""Shared constants for queries.py (Spark) and oracles.py (DuckDB SQL).

Both sides import from here so thresholds/patterns can never drift.
"""

# --- relational core -------------------------------------------------------
Q1_SHIPDATE_MAX = "1998-09-02 00:00:00"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-06-01 00:00:00"
Q3_LIMIT = 10
Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01 00:00:00"
Q5_DATE_HI = "1998-01-01 00:00:00"
Q6_YEAR_LO = "1997-01-01 00:00:00"
Q6_YEAR_HI = "1998-01-01 00:00:00"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY = 24.0

# --- pipeline operators ----------------------------------------------------
EVENT_TYPES_ALLOWED = ("click", "view", "purchase")
AGE_NOW = "2024-01-31 00:00:00"
AGE_MAX_MINUTES = 10080.0  # keep events from the last 7 days
ALIASES = {"click": "selection", "view": "impression", "signup": "registration"}
BLOCK_FACTOR = 16
VALID_MIN_VALUE = 10.0  # value >= this counts as "valid data"
VALID_MIN_FRACTION = 0.82
FNAME_PATTERN = "order_{o_orderpriority}_{o_orderdate:%Y%m%d_%H%M}_k{o_orderkey}.tif"
SZA_MAX_DEG = 85.0  # day-product gate
COVERAGE_MIN_PCT = 30.0
NEAREST_RADIUS_SEC = 600.0
SESSION_GAP_MIN = 30
PUBLISH_PATTERN = '{"uri":"%s","uid":"doc%d","size":%d,"topic":"/files/%s"}'

# --- extensions ------------------------------------------------------------
MINHASH_SHINGLE_WORDS = 3
MINHASH_NUM_HASHES = 8
MINHASH_BANDS = 4
JACCARD_SHINGLE_WORDS = 2
JACCARD_THRESHOLD = 0.2
SIMHASH_BITS = 32
FINGERPRINT_SHINGLE_WORDS = 4
FINGERPRINT_MOD = 8
TOPK_N_QUERIES = 3  # vec_id < 3 are the query vectors
TOPK_K = 10
ANN_BITS = 4
ANN_K = 5
NEARDUP_THRESHOLD = 0.3  # synthetic embeddings are near-random; max cos ~0.5
NEARDUP_BITS = 4

# --- spatial / raster ------------------------------------------------------
R2D_RADIUS = 3.0  # 2-D nearest-neighbor radius (grid units)
R2D_RADIUS_LEFT = 1.0  # small radius so the left-mode query has real misses
GRID_SRC_W = 64  # mapped-resample source grid (unit pixels, origin 0)
GRID_SRC_H = 48
GRID_TGT_W = 32  # target grid: 2x pixels, origin 0.3 -> nearest src px = 2t+1
GRID_TGT_H = 24
R2D_XMOD = 97  # deterministic synthetic point coords from event ids
R2D_YMOD = 89
SUNLIGHT_MIN_PCT = 20.0
SUNLIGHT_MAX_PCT = 80.0
PYRAMID_FACTORS = (16, 64, 256)  # overview levels (block sizes)
UPSAMPLE_FACTOR = 8  # 'native' mode integer upsampling
