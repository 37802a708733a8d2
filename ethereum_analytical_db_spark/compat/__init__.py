from .clickhouse_sql import (  # noqa: F401
    ClickHouseCompat,
    Translated,
    UnsupportedClickHouseSQL,
    grafana_macros,
    register_dialect_functions,
    translate,
)
