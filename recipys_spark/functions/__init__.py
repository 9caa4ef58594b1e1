"""Window-spec builders, skew helpers, and text feature functions."""
