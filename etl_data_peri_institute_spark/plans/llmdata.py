"""(filled in incrementally)"""
