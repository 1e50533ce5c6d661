// Raw-raster sibling of PngDump (round 16): dumps the decoded image's
// raster SAMPLES per band without any color-model conversion, so
// 16-bit PNG layouts can be cross-checked exactly (getRGB would fold
// them through an 8-bit sRGB conversion with its own rounding).
// Output: "FILE <path> <w> <h> <bands>" then one space-separated
// sample row per pixel in raster order.
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.File;
import javax.imageio.ImageIO;

public class RasterDump {
    public static void main(String[] args) throws Exception {
        for (String path : args) {
            BufferedImage img = ImageIO.read(new File(path));
            Raster r = img.getRaster();
            int nb = r.getNumBands();
            System.out.println("FILE " + path + " " + img.getWidth()
                + " " + img.getHeight() + " " + nb);
            StringBuilder sb = new StringBuilder();
            for (int y = 0; y < img.getHeight(); y++) {
                for (int x = 0; x < img.getWidth(); x++) {
                    for (int b = 0; b < nb; b++) {
                        sb.append(r.getSample(x, y, b));
                        sb.append(b == nb - 1 ? '\n' : ' ');
                    }
                }
            }
            System.out.print(sb);
        }
    }
}
