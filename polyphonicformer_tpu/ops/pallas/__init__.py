from .mask_pool import masked_pool
