"""Pure-Python, Spark-free kernels.

Everything in this subpackage is deterministic ``bytes/str -> value``
computation with no Spark, filesystem, network, or clock dependence, so the
same functions can be unit-tested standalone and executed inside Arrow-batch
UDFs (mapInArrow / pandas_udf) on executors.
"""
