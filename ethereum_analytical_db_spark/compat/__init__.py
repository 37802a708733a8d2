from .clickhouse_sql import (  # noqa: F401
    ClickHouseCompat,
    Translated,
    register_dialect_functions,
    translate,
)
