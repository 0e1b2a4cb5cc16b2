"""Regenerate the GeoTIFF fixtures: the synthetic block-pixel law
(FIXTURES.md §2) over a 2x2 grid of 64px blocks at the raster_blocks
default geo-transform, written by freemap_tiler_spark.sources.geotiff.

Interchange evidence: both files decode byte-exactly through Java
ImageIO's TIFF reader (JDK 17 javax.imageio) — verified at generation
time (r5); the reader-side law parity is pinned by pytest.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from freemap_tiler_spark.sources.geotiff import write_geotiff
from freemap_tiler_spark.sources.raster_blocks import block_pixels

here = os.path.dirname(os.path.abspath(__file__))
img = np.zeros((128, 128, 4), np.uint8)
for by in range(2):
    for bx in range(2):
        img[by*64:(by+1)*64, bx*64:(bx+1)*64] = block_pixels(bx, by, 64, 64, 4)
gt = [1_870_000.0, 100.0, 0.0, 6_280_000.0, 0.0, -100.0]
write_geotiff(os.path.join(here, "geotiff_law_tiled_deflate_p2.tif"),
              img, gt, epsg=3857, tile=(64, 64),
              compression="deflate", predictor=2)
write_geotiff(os.path.join(here, "geotiff_law_strips.tif"),
              img, gt, epsg=3857, rows_per_strip=48)
print("wrote fixtures")

# vrt_law/: the same law pixels as a VRT mosaic (two geo-tag-FREE member
# tifs placed by DstRect; contract leg `warp_tiles` src='vrt') — r5-cont
d = os.path.join(here, "vrt_law")
os.makedirs(d, exist_ok=True)
rgb = img[:, :, :3]
write_geotiff(os.path.join(d, "left.tif"), rgb[:, :64], None,
              tile=(64, 64), compression="deflate", predictor=2)
write_geotiff(os.path.join(d, "right.tif"), rgb[:, 64:], None,
              rows_per_strip=32, compression="lzw")
bands = []
for b in (1, 2, 3):
    srcs = "".join(f"""
    <SimpleSource>
      <SourceFilename relativeToVRT="1">{fn}</SourceFilename>
      <SourceBand>{b}</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="64" ySize="128" />
      <DstRect xOff="{dx}" yOff="0" xSize="64" ySize="128" />
    </SimpleSource>""" for fn, dx in [("left.tif", 0), ("right.tif", 64)])
    bands.append(f'  <VRTRasterBand dataType="Byte" band="{b}">{srcs}\n  </VRTRasterBand>')
xml = (f'<VRTDataset rasterXSize="128" rasterYSize="128">\n  <SRS>EPSG:3857</SRS>\n'
       f'  <GeoTransform>{", ".join(str(v) for v in gt)}</GeoTransform>\n'
       + "\n".join(bands) + "\n</VRTDataset>\n")
open(os.path.join(d, "mosaic.vrt"), "w").write(xml)
print("wrote vrt_law fixtures")
