def with_plugins(entry_points):
    def decorator(group):
        return group
    return decorator
