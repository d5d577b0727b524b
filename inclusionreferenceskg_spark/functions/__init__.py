"""Pure-Python core logic executed inside Arrow-batched pandas UDFs.

Nothing in this package imports pyspark: the functions operate on plain
strings/lists/dicts so they are unit-testable without a SparkSession and are
cheap to ship to executors (module import happens once per worker, which is
where all regexes/lexicons are compiled).
"""
