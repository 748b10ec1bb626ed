"""Stream runtime: the reference's semantics on Structured Streaming.

Parity map (reference → here):
- ``Redix.Stream.produce`` (lib/stream.ex:25-38)            → ``log.EventLog.produce``
- blocking XREAD scan loop (consumer.ex:252-281)             → ``consumer.Consumer`` (readStream + trigger)
- XREADGROUP + XACK group mode (consumer.ex:130-216)         → ``consumer.Consumer(group=...)`` + ack log
- ``:defer`` / ``ack/2`` manual ack (consumer.ex:114-124)    → ``consumer.Consumer.ack``
- crash → supervisor restart → pending redelivery            → restart-from-checkpoint (``Consumer.run_once`` loop)
- start-position matrix (consumer.ex:71-91)                  → ``StartPos`` resolution
"""

from .log import EventLog
from .consumer import Consumer, HandlerResult
from .multi import MultiConsumer

__all__ = ["EventLog", "Consumer", "HandlerResult", "MultiConsumer"]
