from python_plugins_spark.operators.transform import (
    PythonTransformError,
    TransformResult,
    columnar_transform,
    python_transform,
    validate_script,
)

__all__ = [
    "python_transform",
    "columnar_transform",
    "validate_script",
    "PythonTransformError",
    "TransformResult",
]
