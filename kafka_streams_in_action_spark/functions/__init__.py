from .serde import (  # noqa: F401
    fnv1a_32,
    fnv1a_partition,
    wire_wrap,
    wire_schema_id,
    wire_payload,
    wire_is_valid,
    wire_wrap_proto,
    wire_payload_proto,
    json_encode,
    json_decode,
)
