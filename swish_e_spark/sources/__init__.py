"""Document sources beyond the pages-table scan (SURVEY.md §2.1):
filters (FileFilter/FileFilterMatch), the -S prog external-program
document protocol, and the spider's crawl logic with a pluggable
fetcher."""
