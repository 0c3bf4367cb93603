"""Minimal JVM class-file assembler + the SswJvmPipe bridge harness.

Why this exists: the reference's Java surface is exercised by running a
JVM against the native library through JNI (ref: src/sswjni.c:36-60,
src/ssw/Example.java:10-39).  Our TPU-native equivalent of that process
boundary is the JSON-lines bridge worker (ssw_tpu/bridge.py), with
bindings/java/ssw/Aligner.java as the client.  This image ships no Java
*compiler* anywhere (exhaustive hunt documented in
tests/test_java_binding.py), but bazel's embedded Zulu 21 JRE is a fully
working JVM — so we assemble, byte by byte, a tiny class file the JRE can
verify and execute.  That lets a REAL JVM spawn the REAL bridge worker
and speak the REAL wire protocol on this image, executing the exact
JVM<->worker boundary the Java binding uses (ProcessBuilder spawn, pipe
marshalling, process lifecycle), which no amount of Python-side replay
can cover.

The generated class is the Java equivalent of:

    public class SswJvmPipe {
      public static void main(String[] args) throws Exception {
        String[] cmd = new String[args.length - 1];
        System.arraycopy(args, 1, cmd, 0, cmd.length);
        ProcessBuilder pb = new ProcessBuilder(cmd);
        pb.redirectError(ProcessBuilder.Redirect.INHERIT);
        Process p = pb.start();
        OutputStream os = p.getOutputStream();
        new FileInputStream(args[0]).transferTo(os);
        os.close();
        p.getInputStream().transferTo(System.out);
        System.out.flush();
        System.exit(p.waitFor());
      }
    }

i.e. `java SswJvmPipe <frames-file> <worker argv...>`: start the worker,
feed it the recorded request frames, stream its responses to stdout, and
exit with the worker's exit code.  tests/test_jvm_bridge.py drives it
with the byte-exact frames ssw.Aligner emits and asserts the responses
byte-identical to a direct (JVM-less) worker run.

Class-file format details: we emit version 49.0 (Java 5) on purpose —
class files below version 50 are checked by the JVM's type-inference
verifier and need no StackMapTable attribute, which keeps the assembler
~150 lines.  JDK 21 still loads and verifies 49.0 classes.
"""

from __future__ import annotations

import struct

# -- constant pool ---------------------------------------------------------

CONSTANT_Utf8 = 1
CONSTANT_Class = 7
CONSTANT_Fieldref = 9
CONSTANT_Methodref = 10
CONSTANT_NameAndType = 12


class ConstPool:
    """Deduplicating constant-pool builder (indices are 1-based)."""

    def __init__(self):
        self.entries: list[bytes] = []
        self._index: dict = {}

    def _add(self, key, data: bytes) -> int:
        idx = self._index.get(key)
        if idx is None:
            self.entries.append(data)
            idx = len(self.entries)
            self._index[key] = idx
        return idx

    def utf8(self, s: str) -> int:
        b = s.encode("utf-8")
        return self._add(("u", s),
                         struct.pack(">BH", CONSTANT_Utf8, len(b)) + b)

    def cls(self, name: str) -> int:
        u = self.utf8(name)
        return self._add(("c", name), struct.pack(">BH", CONSTANT_Class, u))

    def nat(self, name: str, desc: str) -> int:
        n, t = self.utf8(name), self.utf8(desc)
        return self._add(("nt", name, desc),
                         struct.pack(">BHH", CONSTANT_NameAndType, n, t))

    def methodref(self, c: str, name: str, desc: str) -> int:
        ci, nti = self.cls(c), self.nat(name, desc)
        return self._add(("m", c, name, desc),
                         struct.pack(">BHH", CONSTANT_Methodref, ci, nti))

    def fieldref(self, c: str, name: str, desc: str) -> int:
        ci, nti = self.cls(c), self.nat(name, desc)
        return self._add(("f", c, name, desc),
                         struct.pack(">BHH", CONSTANT_Fieldref, ci, nti))

    def dump(self) -> bytes:
        return (struct.pack(">H", len(self.entries) + 1)
                + b"".join(self.entries))


# -- instruction emitter ---------------------------------------------------

class Code:
    def __init__(self, cp: ConstPool):
        self.cp = cp
        self.buf = bytearray()

    def op(self, *byts: int):
        self.buf.extend(byts)

    def u2(self, opcode: int, index: int):
        self.buf.append(opcode)
        self.buf.extend(struct.pack(">H", index))

    # the handful of opcodes the harness needs
    def aload(self, n: int):
        self.op(0x2A + n) if n <= 3 else self.op(0x19, n)

    def astore(self, n: int):
        self.op(0x4B + n) if n <= 3 else self.op(0x3A, n)

    def iconst(self, v: int):
        assert -1 <= v <= 5
        self.op(0x03 + v)

    def arraylength(self):
        self.op(0xBE)

    def isub(self):
        self.op(0x64)

    def aaload(self):
        self.op(0x32)

    def dup(self):
        self.op(0x59)

    def pop(self):
        self.op(0x57)

    def pop2(self):
        self.op(0x58)

    def return_(self):
        self.op(0xB1)

    def anewarray(self, cls: str):
        self.u2(0xBD, self.cp.cls(cls))

    def new(self, cls: str):
        self.u2(0xBB, self.cp.cls(cls))

    def getstatic(self, c: str, n: str, t: str):
        self.u2(0xB2, self.cp.fieldref(c, n, t))

    def invokestatic(self, c: str, n: str, t: str):
        self.u2(0xB8, self.cp.methodref(c, n, t))

    def invokevirtual(self, c: str, n: str, t: str):
        self.u2(0xB6, self.cp.methodref(c, n, t))

    def invokespecial(self, c: str, n: str, t: str):
        self.u2(0xB7, self.cp.methodref(c, n, t))


def class_file(cp: ConstPool, this_cls: str, methods: list) -> bytes:
    """methods: [(access, name, desc, max_stack, max_locals, code_bytes)].
    Interns everything into cp, then serializes a version-49.0 class."""
    this_i = cp.cls(this_cls)
    super_i = cp.cls("java/lang/Object")
    code_attr_name = cp.utf8("Code")
    body = bytearray()
    body += struct.pack(">HH", 0, len(methods))  # 0 fields
    for access, name, desc, max_stack, max_locals, code in methods:
        body += struct.pack(">HHHH", access, cp.utf8(name), cp.utf8(desc), 1)
        attr = struct.pack(">HHI", max_stack, max_locals, len(code))
        attr += code + struct.pack(">HH", 0, 0)  # no exc table, no attrs
        body += struct.pack(">HI", code_attr_name, len(attr)) + attr
    out = bytearray()
    out += struct.pack(">IHH", 0xCAFEBABE, 0, 49)  # version 49.0
    out += cp.dump()
    out += struct.pack(">HHHH", 0x0021, this_i, super_i, 0)  # public super
    out += body
    out += struct.pack(">H", 0)  # no class attributes
    return bytes(out)


# -- the harness class -----------------------------------------------------

PB = "java/lang/ProcessBuilder"
REDIR = "java/lang/ProcessBuilder$Redirect"
PROC = "java/lang/Process"
FIS = "java/io/FileInputStream"
IS = "java/io/InputStream"
OS = "java/io/OutputStream"
PS = "java/io/PrintStream"
SYS = "java/lang/System"
TRANSFER = "(Ljava/io/OutputStream;)J"


def build_pipe_harness() -> bytes:
    """Assemble SswJvmPipe.class (see module docstring for its Java)."""
    cp = ConstPool()
    c = Code(cp)
    # String[] cmd = new String[args.length - 1]
    c.aload(0); c.arraylength(); c.iconst(1); c.isub()
    c.anewarray("java/lang/String"); c.astore(1)
    # System.arraycopy(args, 1, cmd, 0, cmd.length)
    c.aload(0); c.iconst(1); c.aload(1); c.iconst(0)
    c.aload(1); c.arraylength()
    c.invokestatic(SYS, "arraycopy",
                   "(Ljava/lang/Object;ILjava/lang/Object;II)V")
    # ProcessBuilder pb = new ProcessBuilder(cmd)
    c.new(PB); c.dup(); c.aload(1)
    c.invokespecial(PB, "<init>", "([Ljava/lang/String;)V"); c.astore(2)
    # pb.redirectError(Redirect.INHERIT)  (worker stderr -> our stderr)
    c.aload(2)
    c.getstatic(REDIR, "INHERIT", f"L{REDIR};")
    c.invokevirtual(PB, "redirectError",
                    f"(L{REDIR};)Ljava/lang/ProcessBuilder;")
    c.pop()
    # Process p = pb.start()
    c.aload(2); c.invokevirtual(PB, "start", "()Ljava/lang/Process;")
    c.astore(3)
    # OutputStream os = p.getOutputStream()
    c.aload(3)
    c.invokevirtual(PROC, "getOutputStream", f"()L{OS};"); c.astore(4)
    # new FileInputStream(args[0]).transferTo(os)
    c.new(FIS); c.dup(); c.aload(0); c.iconst(0); c.aaload()
    c.invokespecial(FIS, "<init>", "(Ljava/lang/String;)V")
    c.aload(4); c.invokevirtual(FIS, "transferTo", TRANSFER); c.pop2()
    # os.close()  (worker sees EOF after the frames)
    c.aload(4); c.invokevirtual(OS, "close", "()V")
    # p.getInputStream().transferTo(System.out); System.out.flush()
    c.aload(3); c.invokevirtual(PROC, "getInputStream", f"()L{IS};")
    c.getstatic(SYS, "out", f"L{PS};")
    c.invokevirtual(IS, "transferTo", TRANSFER); c.pop2()
    c.getstatic(SYS, "out", f"L{PS};")
    c.invokevirtual(PS, "flush", "()V")
    # System.exit(p.waitFor())
    c.aload(3); c.invokevirtual(PROC, "waitFor", "()I")
    c.invokestatic(SYS, "exit", "(I)V")
    c.return_()
    main = (0x0009, "main", "([Ljava/lang/String;)V", 6, 5, bytes(c.buf))
    return class_file(cp, "SswJvmPipe", [main])


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "SswJvmPipe.class"
    data = build_pipe_harness()
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out} ({len(data)} bytes)")
