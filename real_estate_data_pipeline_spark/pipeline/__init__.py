from .silver import SilverPipeline, SilverResult  # noqa: F401
from .gold import GoldPipeline  # noqa: F401
