VERSION = '0.0.0-stub'
