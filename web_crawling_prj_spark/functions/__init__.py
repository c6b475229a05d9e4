from web_crawling_prj_spark.functions import hashing, text, urls  # noqa: F401
