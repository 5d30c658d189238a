"""Sources & sinks (SURVEY §2.1): parquet/lakehouse readers are in
``analytics.tables`` and ``lakehouse``; exports (CSV/JSON/dump) here."""
