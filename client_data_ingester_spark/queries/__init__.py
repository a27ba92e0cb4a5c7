from .products import list_products, rank_and_paginate

__all__ = ["list_products", "rank_and_paginate"]
