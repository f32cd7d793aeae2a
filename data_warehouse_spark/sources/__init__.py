from data_warehouse_spark.sources.files import (  # noqa: F401
    append_parquet, read_csv, read_json_lines, write_csv, write_json_lines,
)
from data_warehouse_spark.sources.jdbc import (  # noqa: F401
    append_jdbc, connection_options, derby_embedded_options,
    partitioned_read_options, read_jdbc,
)
from data_warehouse_spark.sources.rest_json import (  # noqa: F401
    AIR_QUALITY_SCHEMA, GBFS_SAMPLE, GBFS_SCHEMA, fetch_air_quality,
    gbfs_sample_frame, parse_gbfs,
)
