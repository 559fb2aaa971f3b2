"""Display sinks: stream printer, terminal UI, web map server."""
