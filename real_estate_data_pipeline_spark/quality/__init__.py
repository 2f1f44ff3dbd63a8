from .checks import QualityChecker, CheckResult  # noqa: F401
