"""Expression library: tile/cell algebra, mercator math, CRS transforms,
resampling, codecs (PNG + real baseline JPEG), text."""

from freemap_tiler_spark.functions import (
    cells,
    codecs,
    crs,
    jpeg,
    mercator,
    resample,
    text,
)

__all__ = ["cells", "codecs", "crs", "jpeg", "mercator", "resample", "text"]
