"""The two reference pipelines (facebook insights, currency rates),
DataFrame-first, plus the pub/sub-style dispatcher."""

from .facebook import transform_insights, run_facebook_pipeline  # noqa: F401
from .currency import parse_currency_response, run_currency_pipeline  # noqa: F401
from .dispatch import dispatch_event  # noqa: F401
