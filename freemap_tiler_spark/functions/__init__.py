"""Expression library: tile/cell algebra, mercator math, resampling, codecs, text."""

from freemap_tiler_spark.functions import cells, codecs, mercator, resample, text

__all__ = ["cells", "codecs", "mercator", "resample", "text"]
