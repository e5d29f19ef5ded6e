"""Core types: ScanBuffer, field schemas, message codecs, timing."""
from .fields import (
    FIELD_DTYPE_MAP,
    FIELD_DTYPE_MAP_INV,
    VENDOR_MAPPINGS,
    PointFieldType,
    check_field,
    get_pointcloud_metadata,
    resolve_field_alias,
)
from .msg import (
    CompressedPointCloud2,
    Header,
    PointCloud2,
    PointField,
    Time,
    TransformStamped,
    make_pointcloud2,
    structured_dtype_from_fields,
)
from .codec import (
    build_pointfields,
    create_cloud,
    extract_rgb_from_packed,
    intensity_to_rgb,
    merge_rgb_fields,
    pack_rgb_float,
    pointcloud_to_dict,
    read_points,
    rgb_to_intensity,
    soa_to_structured,
    structured_to_soa,
)
from .scan import (
    ScanBuffer,
    bucket_capacity,
    from_soa,
    pad_to_capacity,
    to_soa,
    valid_count,
)
from .timing import (
    REFERENCE_STAGE_KEYS,
    StageTimer,
    get_current_time,
    get_time_difference,
)
