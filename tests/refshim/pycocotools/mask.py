def _unavailable(*a, **k):
    raise NotImplementedError(
        "pycocotools stub: RLE mask utilities are not available in the "
        "parity-test environment")


encode = decode = merge = frPyObjects = area = toBbox = iou = _unavailable
