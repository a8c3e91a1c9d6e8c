from .ip import CidrTable, extract_ips, ip_to_int, is_valid_ip  # noqa: F401
from .textutil import (  # noqa: F401
    extract_event_id,
    extract_hashes,
    flatten_json,
    infer_proto,
    prematch_regex,
    try_parse_json_text,
)
