from trollflow2_spark.functions.hashing import hash64, HASH64_SQL  # noqa: F401
from trollflow2_spark.functions.geometry import sun_zenith_angle_deg, SZA_SQL  # noqa: F401
