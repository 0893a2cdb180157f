"""Server endpoints: the Arrow Flight SQL surface."""

from .flight import EngineFlightServer, flight_query  # noqa: F401
