from .misc import (autoindex_obj, make_new_dirs, Timer, eta_by_seconds,
                   human_bytes, DeviceMemoryMonitor)
