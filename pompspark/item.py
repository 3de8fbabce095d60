"""Declarative Item/Field records -> StructType (pomp contrib parity).

pomp analog: ``pomp/contrib/item.py`` — ``Item`` subclasses declare
class-level ``Field()`` attributes; a metaclass collects them in
declaration order into ``_fields``; instances behave like records.
Here the same declaration style compiles to a Spark ``StructType`` so
a user's pomp Item definition ports 1:1, and ``as_rows``/``to_df``
bridge python objects into DataFrames (the engine itself never uses
per-row items — this is the user-facing compatibility shim).
"""

from __future__ import annotations

from pyspark.sql import types as T

_SPARK_TYPES = {
    str: T.StringType(),
    int: T.LongType(),
    float: T.DoubleType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
}


class Field:
    """Declarative field. ``type`` is a python type (str/int/float/
    bool/bytes) or a pyspark DataType; ``nullable`` defaults True."""

    _counter = 0

    def __init__(self, type=str, nullable=True):  # noqa: A002
        self.type = type
        self.nullable = nullable
        Field._counter += 1
        self._order = Field._counter

    def spark_type(self) -> T.DataType:
        if isinstance(self.type, T.DataType):
            return self.type
        return _SPARK_TYPES.get(self.type, T.StringType())


class ItemMeta(type):
    def __new__(mcs, name, bases, ns):
        fields = {}
        for base in bases:
            fields.update(getattr(base, "_fields", {}))
        own = {k: v for k, v in ns.items() if isinstance(v, Field)}
        for k in own:
            ns.pop(k)
        fields.update(dict(sorted(own.items(), key=lambda kv: kv[1]._order)))
        cls = super().__new__(mcs, name, bases, ns)
        cls._fields = fields
        return cls


class Item(metaclass=ItemMeta):
    """pomp-style record. Subclass with Field() attrs:

        class PageItem(Item):
            url = Field(str)
            n_links = Field(int)

        PageItem.schema()                  -> StructType
        PageItem(url="u", n_links=3).row() -> tuple in field order
    """

    def __init__(self, **kwargs):
        for k in self._fields:
            setattr(self, k, kwargs.get(k))
        unknown = set(kwargs) - set(self._fields)
        if unknown:
            raise TypeError(f"unknown fields: {sorted(unknown)}")

    @classmethod
    def schema(cls) -> T.StructType:
        return T.StructType([
            T.StructField(k, f.spark_type(), f.nullable)
            for k, f in cls._fields.items()
        ])

    def row(self) -> tuple:
        return tuple(getattr(self, k) for k in self._fields)

    @classmethod
    def to_df(cls, spark, items):
        return spark.createDataFrame([it.row() for it in items], schema=cls.schema())
