"""Server endpoints: Arrow Flight SQL + REST SQL surfaces."""

from .flight import EngineFlightServer, flight_query  # noqa: F401
from .rest import serve_rest_background  # noqa: F401
