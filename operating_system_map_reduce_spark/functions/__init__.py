"""SQL-surface scalar function registry (the KVF concept, SQL tier).

The reference's func_table registers named user code and validates at
registration time (p5/server/my_functable.cc:45-71: duplicate name ->
ERR_FUNC, missing symbols -> ERR_SO).  Two registries generalize it:

 - operators.mapreduce.FuncTable -- Python (map, reduce) pairs for the
   KMR execution path;
 - this package -- named scalar functions registered as Spark SQL
   temporary functions (``CREATE FUNCTION ... RETURN <expr>``).  These
   compile to Catalyst expressions and run inside whole-stage codegen:
   the fast path for the 100 TB pipeline, with no Python worker in the
   loop.
"""

from operating_system_map_reduce_spark.functions.registry import (  # noqa: F401
    BUILTIN_FUNCTIONS,
    SqlFunctionRegistry,
)
