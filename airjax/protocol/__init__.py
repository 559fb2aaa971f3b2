"""Mode S / ADS-B protocol layer: CRC-24, field extraction, packet model."""
