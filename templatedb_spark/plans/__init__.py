"""Plan inspection: assert the physical plans we rely on at scale."""
