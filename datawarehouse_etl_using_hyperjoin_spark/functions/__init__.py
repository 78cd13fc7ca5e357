from .scalar import (  # noqa: F401
    price_cleanse,
    total_sale,
    validate_key,
)
