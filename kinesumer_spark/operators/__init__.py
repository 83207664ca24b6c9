"""Operator modules. Importing a module registers its queries in
``kinesumer_spark.registry`` (see ``registry.all_queries``)."""
