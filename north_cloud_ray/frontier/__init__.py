from .normalize import (  # noqa: F401
    NormalizeError,
    extract_host,
    host_hash64,
    is_binary_url,
    normalize_url,
    url_hash,
)
