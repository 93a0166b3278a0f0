"""Model families: Apple Depth Pro and Depth Anything 3."""
