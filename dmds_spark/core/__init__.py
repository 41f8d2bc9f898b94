from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.core.errors import (
    DmdsError,
    ValueMovedError,
    ValueNotFoundError,
    ValueOutOfRangeError,
)
from dmds_spark.core.select import PosBox, Select, Shape

__all__ = [
    "DimSpec",
    "WorldSpec",
    "PosBox",
    "Select",
    "Shape",
    "DmdsError",
    "ValueMovedError",
    "ValueNotFoundError",
    "ValueOutOfRangeError",
]
