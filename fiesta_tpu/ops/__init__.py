from . import esdf, fusion, query, raycast  # noqa: F401
