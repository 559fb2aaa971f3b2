"""Aircraft tracking: CPR global position decode + ICAO-keyed state."""
