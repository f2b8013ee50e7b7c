"""hfp_parity query catalog (filled in this round)."""
