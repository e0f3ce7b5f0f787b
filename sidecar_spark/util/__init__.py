from sidecar_spark.util.lrc_queue import LRCQueue
from sidecar_spark.util.scan_detector import ScanDetector
from sidecar_spark.util.hashing import base_key, page_key, md5_hex

__all__ = ["LRCQueue", "ScanDetector", "base_key", "page_key", "md5_hex"]
