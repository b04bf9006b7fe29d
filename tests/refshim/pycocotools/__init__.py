"""Import-time stub: mmdet/core/mask/structures.py imports pycocotools.mask
at module load but the parity tests never touch the RLE paths."""
