from fastembed_rs_spark.models.registry import ModelSpec, get_model_spec, list_models  # noqa: F401
