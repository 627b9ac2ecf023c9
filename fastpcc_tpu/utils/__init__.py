from .misc import autoindex_obj, Timer, eta_by_seconds, human_bytes, DeviceMemoryMonitor
