"""Model implementations (reference layer L2)."""
