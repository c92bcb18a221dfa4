from .index import DeviceIndex  # noqa: F401
