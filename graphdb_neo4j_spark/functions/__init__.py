from graphdb_neo4j_spark.functions.etl import (
    canon_event_id,
    json_or_list,
    last_segment,
    posix_basename,
    reg_key_path,
    reg_value_name,
    tag,
    tags_map,
    to_utc,
    truthy,
)

__all__ = [
    "canon_event_id",
    "json_or_list",
    "last_segment",
    "posix_basename",
    "reg_key_path",
    "reg_value_name",
    "tag",
    "tags_map",
    "to_utc",
    "truthy",
]
