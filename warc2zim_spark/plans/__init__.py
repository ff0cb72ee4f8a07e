"""End-to-end pipeline assembly (the reference's two-pass shape)."""
