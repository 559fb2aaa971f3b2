"""IO: .c16 capture files, synthetic IQ generation, block sources."""
