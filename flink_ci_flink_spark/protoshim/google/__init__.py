# Namespace package root for the vendored minimal protobuf runtime shim.
# See google/protobuf/__init__.py for scope and caveats.
#
# Extend rather than claim the `google` namespace: other distributions
# (google-auth, googleapis-common-protos) install google.* namespace
# packages, and a regular package here would shadow them whenever this
# directory lands on sys.path ahead of site-packages.
from pkgutil import extend_path

__path__ = extend_path(__path__, __name__)
