"""(stub — filled in as operators land)"""
