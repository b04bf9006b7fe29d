from .transformer import (ATTENTION, FEEDFORWARD_NETWORK,
                          POSITIONAL_ENCODING, TRANSFORMER_LAYER,
                          TRANSFORMER_LAYER_SEQUENCE, FFN,
                          MultiheadAttention, build_attention, build_dropout,
                          build_feedforward_network,
                          build_positional_encoding, build_transformer_layer)
