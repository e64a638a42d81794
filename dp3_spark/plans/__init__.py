from dp3_spark.plans.compiler import (
    CompileError,
    Compiler,
    FieldNotFoundError,
)

__all__ = ["CompileError", "Compiler", "FieldNotFoundError"]
