"""freemap_tiler_spark — a PySpark-native spatial-join + tile-pyramid engine.

A from-scratch re-expression of the computation performed by the reference
(FreemapSlovakia/freemap-tiler, a Rust CLI that builds MBTiles tile pyramids
from rasters) as an idiomatic Spark engine:

- XYZ / WebMercator tile addressing as 64-bit Morton cell ids
  (``functions.cells``) — all tile algebra is JVM-side Column arithmetic.
- Zoom-pyramid construction by recursive 2x2 child->parent aggregation with
  Lanczos-3 resampling (``operators.pyramid``) — one ``groupBy(parent)``
  ``applyInPandas`` job per zoom level.
- Point-in-polygon joins, kNN, raster<->vector (``operators``).
- Deterministic geotagged web-page corpus sources (``sources``).
- Per-level lineage commits for resumability (``plans.lineage``).

Everything here derives from public knowledge only: the Apache Spark API,
the slippy-map / Web-Mercator tile spec, and the reference's observable
behavior (cited by file:line in docstrings).
"""

__version__ = "0.1.0"
