from arxiv_crawler_spark.crawl.scheduler import CrawlConfig, CrawlEngine  # noqa: F401
from arxiv_crawler_spark.crawl.store import SnapshotStore  # noqa: F401
