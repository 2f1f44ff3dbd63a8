from .conform import conform  # noqa: F401
from .sources import SILVER_SCHEMA, SOURCE_SPECS, SourceSpec, VALIDATION  # noqa: F401
