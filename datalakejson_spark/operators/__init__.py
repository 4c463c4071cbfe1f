# Operator modules register queries via datalakejson_spark.registry.register;
# importing them happens in registry.all_specs() to avoid import cycles.
