"""Sources: synthetic Common-Crawl-style corpus, WARC-ish byte-stream reader,
and testdata table loaders."""
