from .casts import (
    comma_decimal,
    fio_concat,
    int_amount,
    minutes_between,
)

__all__ = ["comma_decimal", "fio_concat", "int_amount", "minutes_between"]
