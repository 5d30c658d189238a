"""Named analytics queries (the reference's dashboard/search/export
surface re-expressed as DataFrame builders) plus DuckDB oracle twins."""
