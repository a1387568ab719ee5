"""Plan-time (driver-side) query planning: interval algebra, catalog,
band-padding. Pure Python — these run before any Spark job is submitted
and emit the predicates/frames the DataFrame plans use."""
