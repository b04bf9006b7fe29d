"""mmcv/cnn/bricks/registry.py shim: the registries live in the shim's
transformer module; mmdet/models/utils/transformer.py imports them here."""
from .transformer import (  # noqa: F401
    ATTENTION,
    FEEDFORWARD_NETWORK,
    POSITIONAL_ENCODING,
    TRANSFORMER_LAYER,
    TRANSFORMER_LAYER_SEQUENCE,
)
