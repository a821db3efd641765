// Unity C# wrapper for the ALICE-Codec TPU C ABI (libalice_codec.so).
//
// Mirrors the reference Unity binding surface (reference:
// bindings/unity/AliceCodec.cs over src/ffi.rs's 20 functions): RAII
// wrappers for Wavelet1D, FrameEncoder and EncodedChunk plus static
// FrameDecoder / Metrics / Version helpers.

using System;
using System.Runtime.InteropServices;

namespace AliceCodecTpu
{
    internal static class Native
    {
        private const string Lib = "alice_codec";

        // Wavelet1D (6)
        [DllImport(Lib)] internal static extern IntPtr alice_codec_wavelet1d_haar();
        [DllImport(Lib)] internal static extern IntPtr alice_codec_wavelet1d_cdf53();
        [DllImport(Lib)] internal static extern IntPtr alice_codec_wavelet1d_cdf97();
        [DllImport(Lib)] internal static extern void alice_codec_wavelet1d_destroy(IntPtr w);
        [DllImport(Lib)] internal static extern void alice_codec_wavelet1d_forward(IntPtr w, int[] data, uint len);
        [DllImport(Lib)] internal static extern void alice_codec_wavelet1d_inverse(IntPtr w, int[] data, uint len);

        // FrameEncoder (3)
        [DllImport(Lib)] internal static extern IntPtr alice_codec_encoder_create(byte quality);
        [DllImport(Lib)] internal static extern void alice_codec_encoder_destroy(IntPtr e);
        [DllImport(Lib)] internal static extern IntPtr alice_codec_encode(IntPtr e, byte[] rgb, uint len, uint w, uint h, uint f);

        // Decode (1)
        [DllImport(Lib)] internal static extern IntPtr alice_codec_decode(IntPtr chunk, out uint outLen);

        // EncodedChunk (6)
        [DllImport(Lib)] internal static extern void alice_codec_chunk_destroy(IntPtr c);
        [DllImport(Lib)] internal static extern IntPtr alice_codec_chunk_to_bytes(IntPtr c, out uint outLen);
        [DllImport(Lib)] internal static extern IntPtr alice_codec_chunk_from_bytes(byte[] data, uint len);
        [DllImport(Lib)] internal static extern uint alice_codec_chunk_width(IntPtr c);
        [DllImport(Lib)] internal static extern uint alice_codec_chunk_height(IntPtr c);
        [DllImport(Lib)] internal static extern uint alice_codec_chunk_frames(IntPtr c);

        // Metrics (1)
        [DllImport(Lib)] internal static extern double alice_codec_psnr(byte[] a, byte[] b, uint len);

        // Utility (3)
        [DllImport(Lib)] internal static extern void alice_codec_data_free(IntPtr p, uint len);
        [DllImport(Lib)] internal static extern void alice_codec_string_free(IntPtr s);
        [DllImport(Lib)] internal static extern IntPtr alice_codec_version();

        internal static byte[] TakeBuffer(IntPtr ptr, uint len)
        {
            if (ptr == IntPtr.Zero) return null;
            var managed = new byte[len];
            Marshal.Copy(ptr, managed, 0, (int)len);
            alice_codec_data_free(ptr, len);
            return managed;
        }
    }

    /// <summary>1D integer lifting wavelet (haar / cdf53 / cdf97).</summary>
    public sealed class Wavelet1D : IDisposable
    {
        private IntPtr _handle;

        private Wavelet1D(IntPtr handle) { _handle = handle; }

        public static Wavelet1D Haar() => new Wavelet1D(Native.alice_codec_wavelet1d_haar());
        public static Wavelet1D Cdf53() => new Wavelet1D(Native.alice_codec_wavelet1d_cdf53());
        public static Wavelet1D Cdf97() => new Wavelet1D(Native.alice_codec_wavelet1d_cdf97());

        public void Forward(int[] signal) =>
            Native.alice_codec_wavelet1d_forward(_handle, signal, (uint)signal.Length);

        public void Inverse(int[] signal) =>
            Native.alice_codec_wavelet1d_inverse(_handle, signal, (uint)signal.Length);

        public void Dispose()
        {
            if (_handle != IntPtr.Zero)
            {
                Native.alice_codec_wavelet1d_destroy(_handle);
                _handle = IntPtr.Zero;
            }
        }
    }

    /// <summary>Compressed chunk handle with serialization.</summary>
    public sealed class EncodedChunk : IDisposable
    {
        internal IntPtr Handle;

        internal EncodedChunk(IntPtr handle) { Handle = handle; }

        public uint Width => Native.alice_codec_chunk_width(Handle);
        public uint Height => Native.alice_codec_chunk_height(Handle);
        public uint Frames => Native.alice_codec_chunk_frames(Handle);

        public byte[] ToBytes()
        {
            var ptr = Native.alice_codec_chunk_to_bytes(Handle, out uint len);
            return Native.TakeBuffer(ptr, len);
        }

        public static EncodedChunk FromBytes(byte[] data)
        {
            var h = Native.alice_codec_chunk_from_bytes(data, (uint)data.Length);
            return h == IntPtr.Zero ? null : new EncodedChunk(h);
        }

        public void Dispose()
        {
            if (Handle != IntPtr.Zero)
            {
                Native.alice_codec_chunk_destroy(Handle);
                Handle = IntPtr.Zero;
            }
        }
    }

    /// <summary>Video frame encoder (quality 0-100).</summary>
    public sealed class FrameEncoder : IDisposable
    {
        private IntPtr _handle;

        public FrameEncoder(byte quality = 90)
        {
            _handle = Native.alice_codec_encoder_create(quality);
        }

        public EncodedChunk Encode(byte[] rgb, uint width, uint height, uint frames)
        {
            var chunk = Native.alice_codec_encode(
                _handle, rgb, (uint)rgb.Length, width, height, frames);
            return chunk == IntPtr.Zero ? null : new EncodedChunk(chunk);
        }

        public void Dispose()
        {
            if (_handle != IntPtr.Zero)
            {
                Native.alice_codec_encoder_destroy(_handle);
                _handle = IntPtr.Zero;
            }
        }
    }

    public static class FrameDecoder
    {
        public static byte[] Decode(EncodedChunk chunk)
        {
            var ptr = Native.alice_codec_decode(chunk.Handle, out uint len);
            return Native.TakeBuffer(ptr, len);
        }
    }

    public static class Metrics
    {
        public static double Psnr(byte[] a, byte[] b) =>
            Native.alice_codec_psnr(a, b, (uint)Math.Min(a.Length, b.Length));
    }

    public static class Version
    {
        public static string Get()
        {
            var ptr = Native.alice_codec_version();
            var s = Marshal.PtrToStringAnsi(ptr);
            Native.alice_codec_string_free(ptr);
            return s;
        }
    }
}
