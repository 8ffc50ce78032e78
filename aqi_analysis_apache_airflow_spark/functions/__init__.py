from .scalar import aqi_category, bucketize

__all__ = ["aqi_category", "bucketize"]
